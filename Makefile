.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py

clean:
	$(MAKE) -C native clean
