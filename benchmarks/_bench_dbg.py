"""Dev wrapper: bench.py with INFO logging (progress visibility on slow runs)."""
import logging
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import runpy

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
sys.argv = ["bench.py"] + sys.argv[1:]
runpy.run_path(str(__import__("pathlib").Path(__file__).resolve().parent.parent / "bench.py"), run_name="__main__")
