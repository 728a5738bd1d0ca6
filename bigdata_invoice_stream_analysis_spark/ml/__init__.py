"""Model training + anomaly scoring (reference §2.6, SURVEY.md)."""
