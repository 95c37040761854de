# rrin-tpu build/test/bench entry points.

.PHONY: all native test test-fast bench bench-vimeo clean

all: native

# C++ host-path library (also auto-built lazily by rrin_tpu.native).
native: rrin_tpu/native/libframepack.so

rrin_tpu/native/libframepack.so: rrin_tpu/native/framepack.cpp
	g++ -O3 -march=native -shared -fPIC -pthread -o $@ $<

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow" -p no:cacheprovider

bench:
	python bench.py

bench-vimeo:
	python bench.py --size vimeo --batch 8 --iters 20

clean:
	rm -f rrin_tpu/native/libframepack.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
