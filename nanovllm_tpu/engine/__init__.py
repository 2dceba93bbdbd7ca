"""Host-side engine: control plane (scheduler, block manager, sequences) and
the execution runtime that drives the jitted TPU data plane."""
