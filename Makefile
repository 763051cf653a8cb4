# Round-end guard: on-chip kernel equivalence + a real 2-layer int8 decode
# smoke. Must pass before a perf-path commit is considered done
# (bench.py preflight; VERDICT r3 item 9).
preflight:
	python bench.py --what preflight

test:
	python -m pytest tests/ -q -n 2

bench:
	python bench.py
.PHONY: preflight test bench
