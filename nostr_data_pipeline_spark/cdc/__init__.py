"""CDC change-log replay: generator, oracle, LWW resolution, merge replayer."""
