"""Local HTML fixtures mirroring books.toscrape.com page structure
(listing pages: article.product_pod grid; detail pages: h1 +
breadcrumb + star-rating + product information table). Used by tests
and the parse qnames so parsing never touches the network."""

from __future__ import annotations


def _detail(title, category, rating_word, price, stock, desc=None, upc="abc123"):
    desc_html = (
        f'<div id="product_description" class="sub-header"><h2>Product Description</h2></div>'
        f"<p>{desc}</p>"
        if desc is not None
        else ""
    )
    return f"""<!DOCTYPE html><html><body>
<ul class="breadcrumb">
  <li><a href="../index.html">Home</a></li>
  <li><a href="../category/books_1/index.html">Books</a></li>
  <li><a href="../category/books/{category.lower()}_2/index.html">{category}</a></li>
  <li class="active">{title}</li>
</ul>
<article class="product_page">
  <div class="item active"><img src="../../media/cache/{upc}.jpg" alt="{title}"></div>
  <p class="star-rating {rating_word}"><i class="icon-star"></i></p>
  <div class="col-sm-6 product_main"><h1>{title}</h1></div>
  {desc_html}
  <table class="table table-striped">
    <tr><th>UPC</th><td>{upc}</td></tr>
    <tr><th>Product Type</th><td>Books</td></tr>
    <tr><th>Price (excl. tax)</th><td>Â£{price}</td></tr>
    <tr><th>Price (incl. tax)</th><td>Â£{price}</td></tr>
    <tr><th>Tax</th><td>Â£0.00</td></tr>
    <tr><th>Availability</th><td>In stock ({stock} available)</td></tr>
    <tr><th>Number of reviews</th><td>0</td></tr>
  </table>
</article>
</body></html>"""


def _listing(hrefs):
    articles = "\n".join(
        f'<article class="product_pod"><h3><a href="../../{h}" title="t">t</a></h3></article>'
        for h in hrefs
    )
    return f"<!DOCTYPE html><html><body><section>{articles}</section></body></html>"


DETAIL_PAGES = [
    (
        "http://books.toscrape.com/catalogue/a-light-in-the-attic_1000/index.html",
        _detail("A Light in the Attic", "Poetry", "Three", "51.77", 22, "A classic collection."),
    ),
    (
        "http://books.toscrape.com/catalogue/tipping-the-velvet_999/index.html",
        _detail("Tipping the Velvet", "Historical Fiction", "One", "53.74", 20, None, upc="def456"),
    ),
    (
        "http://books.toscrape.com/catalogue/soumission_998/index.html",
        _detail("Soumission", "Fiction", "Five", "50.10", 3, "It&#39;s a novel ...more", upc="ghi789"),
    ),
]

LISTING_PAGES = [
    (
        "http://books.toscrape.com/catalogue/page-1.html",
        _listing(
            [
                "a-light-in-the-attic_1000/index.html",
                "tipping-the-velvet_999/index.html",
                "soumission_998/index.html",
            ]
        ),
    ),
    (
        "http://books.toscrape.com/catalogue/page-2.html",
        _listing(["sharp-objects_997/index.html"]),
    ),
]
