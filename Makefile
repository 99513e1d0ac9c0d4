# Convenience targets (the reference's build scripts → one Makefile)
.PHONY: test test-fast bench showcase sweep scaling native clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -k "not fuzz and not sharded"

bench:
	python bench.py

showcase:
	python -m smmb_tpu showcase --csv bench_out/showcase.csv --plot bench_out/showcase.png

sweep:
	python -m smmb_tpu sweep --csv bench_out/sweep.csv

scaling:
	python -m smmb_tpu scaling

native:
	python -c "from smmb_tpu.runtime import native_available; print('native:', native_available())"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; rm -f smmb_tpu/runtime/csrc/*.so
