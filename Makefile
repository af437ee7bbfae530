# Dev ergonomics (the reference ships a Makefile too: /root/reference/Makefile)
PY := PYTHONPATH=.

.PHONY: test parity dtypes plans bench validate pipeline-demo

test:
	python -m pytest tests/ -x -q

parity:
	$(PY) python tools/parity_check.py /root/testdata/sf0.01

dtypes:
	$(PY) python tools/dtype_audit.py /root/testdata/sf0.001

plans:
	$(PY) python tools/plan_report.py

bench:
	SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

validate:
	$(PY) python tools/validate_all.py

pipeline-demo:
	python scripts/run_pipeline.py --synth 1000 --out /tmp/alp_demo
