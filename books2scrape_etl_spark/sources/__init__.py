"""Sources: web-scraper source (URL frontier -> parsed records) and file readers."""
