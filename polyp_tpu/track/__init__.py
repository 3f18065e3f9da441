from polyp_tpu.track.tracker import Tracker, get_tracker, JsonlTracker  # noqa: F401
