# ragfin_tpu build/test entry points.
.PHONY: all native test bench demo clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -x -q

bench:
	python bench.py

demo:
	python examples/demo.py

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
