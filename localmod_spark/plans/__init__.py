"""End-to-end batch plans."""
