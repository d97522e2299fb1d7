"""Re-export of the shared tiny config (kept for test imports)."""
from dynamicrafter_tpu.testing import TINY_MODEL_CONFIG  # noqa: F401
