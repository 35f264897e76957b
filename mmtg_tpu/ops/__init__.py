"""Core compute ops: RNN scan cells, batched sampling, fused kernels."""
