from artgraph_tpu.train.losses import cross_entropy, smooth_l1, mse, nll_loss
from artgraph_tpu.train.early_stopping import EarlyStopping

__all__ = ["cross_entropy", "smooth_l1", "mse", "nll_loss", "EarlyStopping"]
