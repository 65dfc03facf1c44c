"""Distributed serving components (PD disaggregation KV transfer)."""
