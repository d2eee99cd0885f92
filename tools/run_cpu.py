#!/usr/bin/env python
"""Run a script on the CPU backend (sitecustomize pins the axon TPU
plugin via env, which plain JAX_PLATFORMS=cpu does not override —
jax.config does).  Usage: python tools/run_cpu.py <script.py> [args...]
"""

import runpy
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.argv = sys.argv[1:]
runpy.run_path(sys.argv[0], run_name="__main__")
