# Developer conveniences. The package itself needs no build step.

.PHONY: test smoke bench ladder oracle clean

test:
	python -m pytest tests/ -q

smoke:  # the sub-60s CI tier (curated slice touching every module)
	python -m pytest tests/ -m smoke -q

bench:
	python bench.py

ladder:
	python bench.py --ladder --extra --cpu --gpu

oracle:
	$(MAKE) -C cpp

clean:
	$(MAKE) -C cpp clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true

# Real-hardware verification artifact (see scripts/tpu_smoke.sh); pass
# OUT=TPU_TESTS_r03.txt to name the per-round artifact.
tpu-smoke:
	bash scripts/tpu_smoke.sh $(OUT)
