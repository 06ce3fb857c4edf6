"""The 6-stage offboard 3DAL pipeline: detect -> track -> trackData -> motionState
-> static label -> dynamic label."""
