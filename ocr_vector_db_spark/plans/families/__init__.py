"""Per-family query modules behind the shared registry in core.py.

Import order (see plans/inventory.py) preserves the original
registration order the driver-window rotation keys on.
"""
