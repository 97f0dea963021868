"""Embedding providers (≅ /root/reference/internal/embeddings)."""
