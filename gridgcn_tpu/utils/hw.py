"""Shared TPU v5e hardware constants (ADVICE r4: bench.py and
parallel/comm_audit.py each hardcoded their own copies).

All figures are either public spec numbers or rates MEASURED on this
environment's chip (provenance noted per constant). Anything that projects
time from bytes/rows should import from here so a recalibration lands
everywhere at once.
"""

from __future__ import annotations

# public v5e peak (bf16 matmul); MFU denominator
V5E_PEAK_FLOPS = 197e12

# public v5e HBM bandwidth figure
V5E_HBM_BYTES_PER_S = 8.19e11

# public v5e ICI one-direction per-link bandwidth
ICI_BYTES_PER_S = 4.5e10

# measured XLA gather/scatter descriptor rate on this chip: 135-234 M
# rows/s depending on shape, independent of row width and index locality
# (docs/design.md §10); the optimistic end is used for floors
DMA_ROWS_PER_S = 234e6
