# tracer_tpu build / test / bench orchestration
# (the reference drives futhark codegen + cargo from make, Makefile:50-77;
# here the device code is jit-compiled, so make handles the native host
# library, tests, and benchmarks)

.PHONY: all native test smoke bench bench-all clean

all: native

native:
	$(MAKE) -C tracer_tpu/native

test: native
	python -m pytest tests/ -q

# <2-min fast tier: one+ representative test per module. Every snapshot
# commit requires green smoke; estimator-touching commits require one
# full `make test` run too (see CLAUDE.md).
smoke: native
	python -m pytest tests/ -m smoke -q

bench:
	python bench.py

bench-all:
	python benchmarks/run_all.py

clean:
	$(MAKE) -C tracer_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
