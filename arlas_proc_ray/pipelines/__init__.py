"""End-user pipelines: the flagship CDC loop and the query catalog."""
