# Workflow targets (the package.json scripts analog, package.json:5-11)

.PHONY: dev api start build test test-quick bench bench-quick native clean

dev:            ## headless app with orbiting camera
	python apps/main.py --orbit

api:            ## artifact dump API sidecar on :3000
	python -m raytracer_tpu.server.api

start:          ## static viewer server on :3000
	python -m raytracer_tpu.server.static

native:         ## build bin/bvh_convert + lib/libbvhtool.so
	raytracer_tpu/native/build.sh

native-bench:   ## 100x converter loop (test.sh analog)
	raytracer_tpu/native/bench.sh

test:            ## full suite (exhaustive; ~45 min on a 1-CPU host)
	python -m pytest tests/ -x -q

test-quick:      ## fast tier only (skips tests marked 'full'; < 5 min)
	python -m pytest tests/ -x -q -m "not full"

bench:
	python bench.py

bench-quick:
	python bench.py --quick

clean:
	rm -rf bin lib data/*.bin data/*.png .pytest_cache
