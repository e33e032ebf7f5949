# Dev recipes (parity with the reference's justfile:1-16)

test:
    python -m pytest tests/ -q

test-fast:
    python -m pytest tests/ -q -x -k "not sharding and not tv"

bench:
    python bench.py

bench-matrix:
    python benchmarks/run_benchmarks.py --dtype float64 --platform cpu

bench-paths:
    python benchmarks/driver_gap.py --repeat 5

bench-tv:
    python benchmarks/tv_bench.py --repeat 5

scaling:
    python benchmarks/scaling.py --platform cpu

format:
    python -m ruff format proxtpu tests || true

graft-check:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python __graft_entry__.py
