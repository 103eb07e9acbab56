"""Array-engine operators (Deker-parity path exercised as queries).

Filled in once ``core/`` lands; placeholder keeps the registry import
stable.
"""

from __future__ import annotations

OPS: dict = {}
