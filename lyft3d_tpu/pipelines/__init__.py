"""End-to-end pipelines wiring data → device ops → models → eval."""
