# Task runner (reference ships Makefile.toml with check/fmt/test/ci tasks,
# SURVEY §2.13).

.PHONY: test test-fast test-slow native bench clean ci

native:
	$(MAKE) -C cpp

test: native
	python -m pytest tests/ -q

# Fast tier: control plane + quant + golden-HF + server + CLI, ~4 min on
# one CPU. The slow tier (-m slow) adds interpret-mode kernel suites,
# full-engine mesh runs, and the remaining golden decodes (~40 min).
test-fast: native
	python -m pytest tests/ -q -m "not slow"

test-slow: native
	python -m pytest tests/ -q -m "slow"

bench:
	python bench.py

ci: native test

clean:
	$(MAKE) -C cpp clean
	find . -name __pycache__ -type d -exec rm -rf {} +
