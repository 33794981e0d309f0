"""Per-family extension query modules; importing this package
registers nothing — queries_ext imports the members in a
pinned order and restores the global registration order.
"""
