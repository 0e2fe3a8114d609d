# Top-level targets
.PHONY: all native test bench examples clean

all: native examples

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

examples:
	python create_examples.py
	python create_sample_meshes.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
