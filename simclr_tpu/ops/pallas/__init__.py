from simclr_tpu.ops.pallas.ntxent import nt_xent_loss_pallas, supports

__all__ = ["nt_xent_loss_pallas", "supports"]
