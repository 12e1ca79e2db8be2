"""Catalog extensions: the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal, events/streaming-batch
parity).  Registered into the same catalog as the core SQL surface.

Filled in operator-by-operator; see operators/{dedup,similarity,textstats,
multimodal,asof}.py for the implementations.
"""

from __future__ import annotations
