# Top-level automation entry points (ref: Jenkinsfile:155-283, makefile).
#
#   make check        lint + layering + fast unit subset + sampler smoke
#   make check-all    ... with the full pytest suite (~25-30 min)
#   make test         full pytest suite only
#   make bench        headline TPU bench (one JSON line per BASELINE config)
#   make native       C++ draw store shared library

PY ?= python

.PHONY: check check-all test bench native

check:
	$(PY) runchecks.py

check-all:
	$(PY) runchecks.py --all

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

native:
	$(MAKE) -C native
