# Parity with the reference's Makefile (build/run helpers for the
# batch-bootstrapper container), extended with the repo's test/bench loop.
SF_DIR ?= /root/testdata/sf0.1
IMAGE  ?= tabular-cdc-bootstrapper-spark

.PHONY: test bench verify smoke run image

test:
	python -m pytest tests/ -q

# one JSON line of per-query medians at $(SF_DIR)
bench:
	SPARK_GRAFT_SF_DIR=$(SF_DIR) python bench.py

# fast correctness sweep at the smoke scale factor
smoke:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 python bench.py

verify:
	python -m pytest tests/test_oracle_parity.py -q

# the reference's container lifecycle, natively (see README "Running")
run:
	python -m tabular_cdc_bootstrapper_spark

image:
	docker build -t $(IMAGE) .
