# diagonal_b6_spark build/test/bench entry points

PY ?= python

.PHONY: test bench scaling package submit-local clean

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

scaling:
	$(PY) bench.py --scaling

# zip the library for spark-submit --py-files (cluster launch path)
package:
	mkdir -p dist
	rm -f dist/diagonal_b6_spark.zip
	zip -qr dist/diagonal_b6_spark.zip diagonal_b6_spark -x '*__pycache__*'

# end-to-end spark-submit smoke on local[8] (same invocation shape as a
# cluster: only --master changes)
submit-local: package
	spark-submit --master 'local[8]' \
	  --conf spark.sql.shuffle.partitions=8 \
	  --py-files dist/diagonal_b6_spark.zip \
	  jobs/flagship_job.py --images 50000 --checkpoint /tmp/flagship_submit_ckpt

clean:
	rm -rf dist .pytest_cache
	find . -name __pycache__ -prune -exec rm -rf {} +
