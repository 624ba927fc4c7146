import sys; sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import tempfile, pathlib
from iresearch_spark.session import get_spark
import importlib
m = importlib.import_module("tests.test_lifecycle_random")
spark = get_spark("sweep", master="local[8]", shuffle_partitions=8)
class TPF:
    def mktemp(self, name):
        return pathlib.Path(tempfile.mkdtemp(prefix=name))
ok = []
for seed in (101, 202, 303, 404, 505, 606):
    m.test_random_lifecycle_matches_oracle(spark, TPF(), seed)
    ok.append(seed); print("seed", seed, "OK", flush=True)
print("ALL OK", ok)
