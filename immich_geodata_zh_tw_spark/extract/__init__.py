"""Web-page extract stage: ``html:binary`` → (text, lat, lon)."""
