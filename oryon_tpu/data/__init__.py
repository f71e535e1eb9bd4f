from oryon_tpu.data.pair_batch import PairBatch
from oryon_tpu.data.synthetic import synthetic_pair_batch
