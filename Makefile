# Convenience targets (the reference drives its tests from a Makefile too,
# SURVEY §4; here the real suite is pytest).

.PHONY: test bench lint dryrun

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
