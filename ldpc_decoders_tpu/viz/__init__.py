"""Plotting and analysis of simulation results (reference src/graph.py,
src/luby_graph.py)."""
