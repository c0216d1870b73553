"""Reusable operator implementations (composed into queries/)."""
