"""Dev wrapper: bench.py with INFO logging (progress visibility on slow runs)."""
import logging
import runpy
import sys

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
sys.argv = ["bench.py"] + sys.argv[1:]
runpy.run_path("bench.py", run_name="__main__")
