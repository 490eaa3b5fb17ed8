"""Backend auto-resolution logging shared by the trainer families.

``rollout_backend`` / ``grad_backend`` = "auto" resolve to the fused
Pallas kernels on real TPU hardware when the config is inside the
kernel envelopes, and to XLA otherwise. The resolution is surfaced two
ways (VERDICT r3 item 6):

- a fallback to XLA ON TPU HARDWARE logs at WARNING with the reasons —
  the user is silently leaving the fast path on the hardware it exists
  for (e.g. ``--policy-groups`` pushing the SGD phase off the fused
  kernel);
- every trainer returns the RESOLVED backends on its trainer tuple
  (``PPOTrainer.backends``), which ``train.__main__`` records in
  metrics.jsonl and ``bench.py`` records in its JSON line.
"""

from __future__ import annotations

import logging

import jax

log = logging.getLogger("warehouse_tpu")


def log_auto_resolution(knob: str, resolved: str, reasons: list[str],
                        family: str) -> None:
    """Log an auto-backend resolution; WARNING on a TPU-side fallback."""
    if resolved == "xla" and jax.default_backend() == "tpu":
        log.warning(
            "%s=auto -> xla ON TPU HARDWARE (%s): the fused Pallas "
            "fast path is disabled by: %s",
            knob, family, "; ".join(reasons) or "unknown")
    else:
        log.info("%s=auto -> %s (%s)%s", knob, resolved, family,
                 f" [{'; '.join(reasons)}]" if reasons else "")
