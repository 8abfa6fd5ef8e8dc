# Developer conveniences (see CLAUDE.md for environment notes)

.PHONY: test test-fast bench bench-train native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

bench:
	python bench.py

bench-train:
	BENCH_MODE=train python bench.py

native:
	$(MAKE) -C native

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
