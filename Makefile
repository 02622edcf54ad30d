# Developer workflow (the reference's Makefile exposes run/test;
# ours exposes the three verification surfaces).

.PHONY: test selfcheck bench all

test:
	python -m pytest tests/ -q

selfcheck:
	python scripts/selfcheck.py

selfcheck-sf01:
	python scripts/selfcheck.py /root/testdata/sf0.1

bench:
	python bench.py

all: test selfcheck bench
