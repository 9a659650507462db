.PHONY: test bench smoke correctness

test:
	python -m pytest tests/ -q

correctness:
	python -m pytest tests/test_correctness.py -q

bench:
	python bench.py

smoke:
	python -c "import __spark_entry__ as e; from data_pipeline_spark.session import get_spark; s=get_spark('smoke'); print(len(e.entry(s).collect()), 'rows'); s.stop()"
