# Build / test entry points — the reference's CMake role
# (/root/reference/CMakeLists.txt) for a Python+JAX framework with one native
# C++ shared library.

.PHONY: all native test bench smoke clean

all: native

native:
	python -m cuda_recommender_tpu.native.build

test:
	python -m pytest tests/ -q

bench:
	python bench.py

smoke:
	./scripts/smoke.sh

clean:
	rm -f cuda_recommender_tpu/native/libcrtpu_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
