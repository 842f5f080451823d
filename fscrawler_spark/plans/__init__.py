"""Crawl planning: job config, wave loop, checkpoint store, simulator."""
