.PHONY: setup test smoke bench clean lint

setup:
	python run.py setup

test:
	python run.py test

smoke:
	python run.py smoke

bench:
	python bench.py

clean:
	python run.py clean

lint:
	python -m compileall -q adsr_tpu tests bench.py run.py __graft_entry__.py
