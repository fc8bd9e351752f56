"""Operator library: event-time windows, relational breadth, dedup,
similarity search, multimodal plumbing — each expressed as a Catalyst
logical-plan fragment (DataFrame in → DataFrame out)."""
