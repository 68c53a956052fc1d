"""Dev wrapper: bench.py with INFO logging (progress visibility on slow runs)."""
import logging
import runpy
import sys

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
sys.argv = ["bench.py"] + sys.argv[1:]
runpy.run_path(str(__import__("pathlib").Path(__file__).resolve().parent.parent / "bench.py"), run_name="__main__")
