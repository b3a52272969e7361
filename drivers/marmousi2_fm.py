#!/usr/bin/env python
"""SMARM2 Marmousi driver (reference ``marmousi2_fm.py``); see
``_marmousi_common.py`` for the shared configuration and flow."""
from _marmousi_common import SMARM2, run_fm

if __name__ == "__main__":
    run_fm(SMARM2)
