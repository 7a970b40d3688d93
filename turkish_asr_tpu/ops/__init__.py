from turkish_asr_tpu.ops.ctc import ctc_loss, ctc_loss_numpy_oracle

__all__ = ["ctc_loss", "ctc_loss_numpy_oracle"]
