"""Structured Streaming surface: replay sources, event-time window
operators (Group C), and the streaming CDC apply."""
