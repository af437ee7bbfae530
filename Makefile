# Dev ergonomics (the reference ships a Makefile too: /root/reference/Makefile)
PY := PYTHONPATH=.

.PHONY: test parity dtypes plans bench validate pipeline-demo submit-check

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

# the north_rule deployment path, exactly as a cluster would run it:
# package the library, ship via --py-files, run the pipeline entry point
submit-check:
	rm -f /tmp/alp.zip && zip -qr /tmp/alp.zip access_log_parser_spark
	spark-submit --master 'local[4]' --driver-memory 8g \
	    --conf spark.sql.shuffle.partitions=4 --py-files /tmp/alp.zip \
	    scripts/run_pipeline.py --synth 50 --out /tmp/alp_submit_check

train-prep-demo:
	python scripts/prepare_training_data.py --synth 2000 --out /tmp/alp_train_demo \
	    --epoch 1 --alpha 0.5 --quality-min 0.0 --rep-max 1.0
