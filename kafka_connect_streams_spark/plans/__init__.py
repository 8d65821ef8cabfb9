"""Physical-plan inspection: assert the plans we want, not just the answers."""
