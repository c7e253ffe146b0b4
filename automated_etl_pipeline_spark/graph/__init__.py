"""Distributed graph algorithms over DataFrame edge lists."""
