"""Cross-modal fusion trainer: two-input batches, GCN-submodule weight loading.

Capability parity with reference processor/recognition_cross_modal.py:
  * train/test loops feed model(data_ske, data_rgb) (reference :41-99) — the
    base trainer already generalises over the feeder's input tuple;
  * --weights loads pretrained CTR-GCN weights into the model's `gcn`
    submodule only (reference :101-113, DataParallel-aware prefix handling
    is covered by strip_module_prefix);
  * freezing the GCN is config-driven (--freeze_params gcn), which masks its
    optimiser updates and weight decay — the functional requires_grad=False.

This class also serves the (broken-as-shipped) recognition_fusion entry of
the reference (processor/recognition_fusion.py references a missing MMNet
model, SURVEY §2 ghost modules): any two-input model registered in
tamgcn_tpu.models works through the same driver.
"""
from __future__ import annotations

from .trainer import RecognitionTrainer


class CrossModalTrainer(RecognitionTrainer):
    def _import_npz(self, state: dict):
        """Reference-exported CTR-GCN weights -> this model's gcn subtree
        (reference recognition_cross_modal.py:101-113)."""
        from ..utils.torch_import import import_ctrgcn_state_dict

        gcn = import_ctrgcn_state_dict(state)
        gcn["params"].pop("fc", None)  # fusion never uses the GCN head
        return {
            "params": {"gcn": gcn["params"]},
            "batch_stats": {"gcn": gcn["batch_stats"]},
        }
