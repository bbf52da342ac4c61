# Convenience targets (the reference drives its tests from a Makefile too,
# SURVEY §4; here the real suite is pytest).
#
# `make test` runs ONE pytest subprocess per test file: a single-process
# `pytest tests/` exhausts vm.max_map_count (~65k mmaps of accumulated
# XLA:CPU JIT executables) on a cold cache and segfaults — see
# tools/run_tests.py's docstring for the diagnosis and the sysctl
# alternative.  `make test-oneproc` is the raw single-process run (fine
# on boxes with a raised map limit or a warm compile cache).

.PHONY: test test-oneproc bench lint dryrun

test:
	python tools/run_tests.py

test-oneproc:
	python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
