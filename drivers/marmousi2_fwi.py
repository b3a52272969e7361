#!/usr/bin/env python
"""SMARM2 Marmousi driver (reference ``marmousi2_fwi.py``); see
``_marmousi_common.py`` for the shared configuration and flow."""
from _marmousi_common import SMARM2, run_fwi

if __name__ == "__main__":
    run_fwi(SMARM2)
