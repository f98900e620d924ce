"""Input sources: synthetic Common-Crawl-style pages + document enqueue."""
