"""Pallas TPU kernels — the fast path for the serving hot ops.

Each kernel has a pure-jnp numerics oracle in ops/ (paged_attention_ref,
quant_matmul); equivalence tests run the kernels in interpret mode on CPU
(SURVEY §4 test strategy).
"""
