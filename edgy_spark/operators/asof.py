"""Registered queries — populated in this round."""
