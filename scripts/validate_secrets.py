#!/usr/bin/env python
"""CLI wrapper over the secrets gate (reference: scripts/validate-secrets.js).

Exits non-zero listing any missing required secrets unless ALLOW_DEGRADED=1.
"""

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from image_restoration_platform_tpu.config import assert_required_secrets, list_required_secrets

missing = assert_required_secrets(exit_on_missing=True)
if missing:
    print(f"degraded mode: missing {', '.join(missing)} (ALLOW_DEGRADED=1)")
else:
    print(f"all required secrets present: {', '.join(list_required_secrets())}")
