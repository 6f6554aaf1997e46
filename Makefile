# Dev loop. The axon sitecustomize claims the TPU in every plain `python`
# process; CPU work must bypass it (env -u PALLAS_AXON_POOL_IPS).
CPU_ENV := env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu

.PHONY: test test-fast bench lint

test:
	$(CPU_ENV) python -m pytest tests/ -x -q

test-fast:
	$(CPU_ENV) python -m pytest tests/ -x -q -m "not slow"

bench:
	python bench.py

lint:
	$(CPU_ENV) python -m compileall -q cusift_tpu
