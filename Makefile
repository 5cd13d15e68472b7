# Mirrors the reference's Makefile contract (test / format-and-lint / clean):
# /root/reference/Makefile:1-12

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow"

lint:
	-python -m pre_commit run --all-files

format-and-lint:
	-python -m ruff check odecheckpts_tpu tests experiments --fix
	-python -m ruff format odecheckpts_tpu tests experiments

bench:
	python bench.py

clean:
	rm -rf .pytest_cache **/__pycache__
