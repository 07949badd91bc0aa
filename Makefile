# Workflow targets (the package.json scripts analog, package.json:5-11)

.PHONY: dev api start build test bench bench-quick native clean

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

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-quick:
	python bench.py --quick

clean:
	rm -rf bin lib data/*.bin data/*.png .pytest_cache
