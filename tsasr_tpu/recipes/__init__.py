"""Task recipes built on the framework (the reference's repo-root level)."""
