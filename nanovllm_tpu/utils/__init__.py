"""Host utilities: batch metadata, weight loading, tokenization."""
