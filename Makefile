# Developer entry points (parity with the reference's Makefile targets:
# test / bench / lint; plus the native build).

PY ?= python

.PHONY: all test bench benchmarks native clean demo dryrun

all: native test

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x --ignore=tests/test_field_jax.py \
		--ignore=tests/test_point_jax.py --ignore=tests/test_batch_parallel.py

bench:
	$(PY) bench.py

benchmarks:
	$(PY) benchmarks.py

native:
	$(MAKE) -C native

demo:
	$(PY) -m quisquis_tpu.cli

dryrun:
	$(PY) -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C native clean
	rm -rf .jax_cache tests/.jax_cache quisquis_tpu/**/__pycache__ __pycache__
