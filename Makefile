# Task runner (reference ships Makefile.toml with check/fmt/test/ci tasks,
# SURVEY §2.13).

.PHONY: test native bench clean ci

native:
	$(MAKE) -C cpp

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

ci: native test

clean:
	$(MAKE) -C cpp clean
	find . -name __pycache__ -type d -exec rm -rf {} +
