# Mirrors the reference's Makefile contract (test / format-and-lint / clean):
# /root/reference/Makefile:1-12

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

# <2 min unit-oracle layer for mid-round iteration (sqrt algebra, prior
# discretization, Taylor init, Markov stats, controller/calibration units)
test-smoke:
	python -m pytest tests/test_linalg.py tests/test_prior.py \
	  tests/test_taylor.py tests/test_stats.py tests/test_error_units.py \
	  -x -q -m "not slow"

# snapshot precondition (round-4 verdict): the fast tier must be green
# before an end-of-round commit
snapshot-check: test-fast

lint:
	-python -m pre_commit run --all-files

format-and-lint:
	-python -m ruff check odecheckpts_tpu tests experiments --fix
	-python -m ruff format odecheckpts_tpu tests experiments

bench:
	python bench.py

clean:
	rm -rf .pytest_cache **/__pycache__
