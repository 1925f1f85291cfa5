# Convenience targets (the reference's Makefile builds everything with nvcc;
# here the Python package needs no build step and the C++ host runtime
# auto-builds on first import — `make native` forces it).

PY ?= python

.PHONY: test native bench scaling clean

test:
	$(PY) -m pytest tests/ -x -q

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	  ppoc_tpu/native/src/ppoc_native.cpp -o ppoc_tpu/native/libppoc_native.so -lm

bench:
	$(PY) bench.py --verbose

scaling:
	$(PY) bench_scaling.py --platform cpu --devices 8

clean:
	rm -f ppoc_tpu/native/libppoc_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
