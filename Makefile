# Developer entry points. `make test` is the default suite run — the
# full tests/ tree in eight concurrent pytest lanes (tools/run_tests.sh;
# same sharding the round close uses), ~12-13 min overlapped vs 20+ min
# single-process.
.PHONY: test test-serial bench verify plans

test:
	bash tools/run_tests.sh

# the old single-process spelling, for bisecting lane interference
test-serial:
	python -m pytest tests/ -x -q

bench:
	python bench.py

# full-surface DuckDB parity at sf0.01 (what the driver grades)
verify:
	PYTHONPATH=. python tools/check_parity.py /root/testdata/sf0.01

plans:
	PYTHONPATH=. python tools/explain_plans.py > /dev/null
