"""`python -m tpu_ffv1.cli` entry point (ffmpeg.c:4302 main analog)."""
import sys

from .main import run

sys.exit(run())
