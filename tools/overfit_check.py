# Overfit sanity: tiny model on synthetic data, 150 iters on the TPU —
# total_loss must drop substantially (learning-signal integrity check).
import sys
sys.path.insert(0, 'tests')
import numpy as np, jax, time
from test_end_to_end import setup_dataset, tiny_cfg
import tempfile, pathlib
root = tempfile.mkdtemp()
setup_dataset(root)
class P:  # tiny_cfg expects a path-like with '/'
    def __init__(self, r): self.r = r
    def __truediv__(self, o): return pathlib.Path(self.r) / o
cfg = tiny_cfg(P(root))
cfg.SOLVER.MAX_ITER = 150
cfg.SOLVER.BASE_LR = 0.02
cfg.SOLVER.IMS_PER_BATCH = 4
cfg.OUTPUT_DIR = root + '/out'
from fewshotobjectdetection_imporove_via_text_feature_tpu.engine import Trainer
t0 = time.time()
tr = Trainer(cfg)
tr.train()
import json
recs = [json.loads(l) for l in open(cfg.OUTPUT_DIR + '/metrics.json')]
first, last = recs[0], recs[-1]
print('iters:', last['iteration'], 'wall:', round(time.time()-t0, 1))
print('loss first -> last:', round(first['total_loss'], 3), '->', round(last['total_loss'], 3))
assert last['total_loss'] < first['total_loss'] * 0.7, 'loss did not drop'
print('OVERFIT CHECK PASSED')
