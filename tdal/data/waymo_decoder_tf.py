"""Waymo tfrecord frame decoding (optional TF/devkit path).

Output schema parity with reference ``det3d/datasets/waymo/waymo_decoder.py:22-207``:
- decode_frame -> {'scene_name','frame_name','frame_id',
                   'lidars': {'points_xyz' (N,3) f32, 'points_feature' (N,2) f32}}
  merging first + second lidar returns, features = (intensity, elongation).
- decode_annos -> {'scene_name','frame_name','frame_id','veh_to_global' (16,),
                   'objects': [{'id','name','label','box' (9,) f32,'num_points',
                                'detection_difficulty_level',
                                'combined_difficulty_level','global_speed',
                                'global_accel'}]}

Implementation uses the devkit's range-image utilities rather than re-deriving the
spherical projection; the emitted pickles are bit-compatible consumers-wise.
Import only when waymo_open_dataset + tensorflow are installed.
"""

from __future__ import annotations

import numpy as np


def combined_difficulty(detection_difficulty_level: int, num_points: int) -> int:
    """The Waymo combined-difficulty rule (waymo_decoder.py:175-185).

    When the labeler set no level (0), derive it from points-in-box:
    >= 5 points -> LEVEL_1, else LEVEL_2. Otherwise keep the labeler's level.

    Reference quirk preserved: its ``999 if num_points <= 0`` assignment is
    ALWAYS overwritten (the following ``if detection_difficulty_level == 0``
    is not an elif), so an empty unlabeled box ends up LEVEL_2, never 999 —
    we match the reference's actual behavior, not its comment. This field
    drives the devkit's L1/L2 split (waymo_common.py:222-231)."""
    if detection_difficulty_level == 0:
        return 1 if num_points >= 5 else 2
    return int(detection_difficulty_level)


def _extract_points(frame, parsed):
    import tensorflow as tf
    from waymo_open_dataset.utils import frame_utils, range_image_utils, transform_utils

    (range_images, camera_projections, _, range_image_top_pose) = parsed
    points_both, features_both = [], []
    for ri_index in (0, 1):  # first + second return (waymo_decoder.py:71-132)
        points, cp_points = frame_utils.convert_range_image_to_point_cloud(
            frame, range_images, camera_projections, range_image_top_pose,
            ri_index=ri_index, keep_polar_features=True,
        )
        # keep_polar_features: columns are (range, intensity, elongation, x, y, z)
        xyz = np.concatenate([p[:, 3:6] for p in points], axis=0)
        feat = np.concatenate([p[:, 1:3] for p in points], axis=0)
        points_both.append(xyz)
        features_both.append(feat)
    return (
        np.concatenate(points_both, axis=0).astype(np.float32),
        np.concatenate(features_both, axis=0).astype(np.float32),
    )


def decode_frame(frame, frame_id: int) -> dict:
    from waymo_open_dataset.utils import frame_utils

    parsed = frame_utils.parse_range_image_and_camera_projection(frame)
    points_xyz, points_feature = _extract_points(frame, parsed)
    return {
        "scene_name": frame.context.name,
        "frame_name": "{scene_name}_{location}_{time_of_day}_{timestamp}".format(
            scene_name=frame.context.name,
            location=frame.context.stats.location,
            time_of_day=frame.context.stats.time_of_day,
            timestamp=frame.timestamp_micros,
        ),
        "frame_id": frame_id,
        "lidars": {"points_xyz": points_xyz, "points_feature": points_feature},
    }


def decode_annos(frame, frame_id: int) -> dict:
    veh_to_global = np.array(frame.pose.transform, np.float64)
    objects = []
    for label in frame.laser_labels:
        box = label.box
        speed = [label.metadata.speed_x, label.metadata.speed_y]
        accel = [label.metadata.accel_x, label.metadata.accel_y]
        # box9 [x, y, z, l, w, h, vx, vy, heading] (waymo_decoder.extract_objects)
        objects.append(
            {
                "id": len(objects),
                "name": label.id,
                "label": label.type,
                "box": np.array(
                    [
                        box.center_x, box.center_y, box.center_z,
                        box.length, box.width, box.height,
                        speed[0], speed[1], box.heading,
                    ],
                    np.float32,
                ),
                "num_points": label.num_lidar_points_in_box,
                "detection_difficulty_level": label.detection_difficulty_level,
                "combined_difficulty_level": combined_difficulty(
                    label.detection_difficulty_level,
                    label.num_lidar_points_in_box,
                ),
                "global_speed": np.array(speed, np.float32),
                "global_accel": np.array(accel, np.float32),
            }
        )
    return {
        "scene_name": frame.context.name,
        "frame_name": "{scene_name}_{location}_{time_of_day}_{timestamp}".format(
            scene_name=frame.context.name,
            location=frame.context.stats.location,
            time_of_day=frame.context.stats.time_of_day,
            timestamp=frame.timestamp_micros,
        ),
        "frame_id": frame_id,
        "veh_to_global": veh_to_global,
        "objects": objects,
    }
