"""Model components: encoder channels, attention fusion, GPT-2 decoder."""
