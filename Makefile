# Entry points. `make eval` is the real-assets acceptance gate: it runs
# the reference protocol (test_sample + test_GATsSPG) the moment
# checkpoints/data exist under data/, and appends cmd1/3/5 to BASELINE.md.
.PHONY: eval eval-check test test-all bench

eval:
	python scripts/eval_real.py

eval-check:
	python scripts/eval_real.py --check

test:
	python -m pytest tests/ -q -m "not slow"

test-all:
	python -m pytest tests/ -q

bench:
	python bench.py
