.PHONY: test bench native lint

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	sh scripts/build_native.sh

lint:
	python -m py_compile $$(git ls-files '*.py')
