"""Experimental modules: implemented, tested, but NOT wired into the
default pipeline because they lost their A/Bs (each module's docstring
records the numbers).  Kept for scenes where the economics may differ.
"""
