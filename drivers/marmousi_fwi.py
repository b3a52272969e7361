#!/usr/bin/env python
"""SMARMN Marmousi driver (reference ``marmousi_fwi.py``); see
``_marmousi_common.py`` for the shared configuration and flow."""
from _marmousi_common import SMARMN, run_fwi

if __name__ == "__main__":
    run_fwi(SMARMN)
