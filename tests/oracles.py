"""Plain-numpy oracle implementations used to cross-check the JAX core.

These re-derive, independently and legibly, the *semantics* of the reference's geometry
(det3d box_np_ops / geometry.py / iou3d_nms_kernel.cu / fpointnet provider) so the JAX
implementations can be tested against a second, simpler formulation. Shapely is used when
available for polygon ground truth; otherwise a numpy clip fallback runs.
"""

import numpy as np


def rot_ccw(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


def box_corners_bev(box5):
    """[x, y, l, w, heading(CCW)] -> (4, 2) corners."""
    x, y, l, w, h = box5
    local = np.array(
        [[-l / 2, -w / 2], [-l / 2, w / 2], [l / 2, w / 2], [l / 2, -w / 2]]
    )
    return local @ rot_ccw(h).T + np.array([x, y])


def polygon_area(poly):
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def clip_polygon(subject, clip):
    """Sutherland-Hodgman: clip `subject` polygon by convex `clip` polygon (CCW)."""

    def inside(p, a, b):
        return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= -1e-12

    def intersect(p1, p2, a, b):
        d1 = np.array(p2) - np.array(p1)
        d2 = np.array(b) - np.array(a)
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        t = ((a[0] - p1[0]) * d2[1] - (a[1] - p1[1]) * d2[0]) / denom
        return np.array(p1) + t * d1

    output = list(subject)
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list = output
        output = []
        if not input_list:
            break
        for j in range(len(input_list)):
            p1 = input_list[j - 1]
            p2 = input_list[j]
            if inside(p2, a, b):
                if not inside(p1, a, b):
                    output.append(intersect(p1, p2, a, b))
                output.append(p2)
            elif inside(p1, a, b):
                output.append(intersect(p1, p2, a, b))
    return np.array(output) if output else np.zeros((0, 2))


def ensure_ccw(poly):
    x, y = poly[:, 0], poly[:, 1]
    if np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)) < 0:
        return poly[::-1]
    return poly


def bev_intersection_area(box_a5, box_b5):
    ca = ensure_ccw(box_corners_bev(box_a5))
    cb = ensure_ccw(box_corners_bev(box_b5))
    inter = clip_polygon(ca, cb)
    if len(inter) < 3:
        return 0.0
    return polygon_area(inter)


def iou_bev(box_a7, box_b7):
    a5 = box_a7[[0, 1, 3, 4, 6]]
    b5 = box_b7[[0, 1, 3, 4, 6]]
    inter = bev_intersection_area(a5, b5)
    ua = box_a7[3] * box_a7[4] + box_b7[3] * box_b7[4] - inter
    return inter / max(ua, 1e-12)


def iou_3d(box_a7, box_b7):
    a5 = box_a7[[0, 1, 3, 4, 6]]
    b5 = box_b7[[0, 1, 3, 4, 6]]
    inter_bev = bev_intersection_area(a5, b5)
    zmax = min(box_a7[2] + box_a7[5] / 2, box_b7[2] + box_b7[5] / 2)
    zmin = max(box_a7[2] - box_a7[5] / 2, box_b7[2] - box_b7[5] / 2)
    inter = inter_bev * max(0.0, zmax - zmin)
    va = box_a7[3] * box_a7[4] * box_a7[5]
    vb = box_b7[3] * box_b7[4] * box_b7[5]
    return inter / max(va + vb - inter, 1e-12)


def points_in_rbbox(points, boxes):
    """(N, 3), (M, 7) -> bool (N, M). Half-space test, CCW heading."""
    out = np.zeros((len(points), len(boxes)), dtype=bool)
    for m, b in enumerate(boxes):
        d = points[:, :3] - b[:3]
        local = d[:, :2] @ rot_ccw(b[6])  # rotate by -heading
        inside = (
            (np.abs(local[:, 0]) <= b[3] / 2)
            & (np.abs(local[:, 1]) <= b[4] / 2)
            & (np.abs(d[:, 2]) <= b[5] / 2)
        )
        out[:, m] = inside
    return out


def ref_angle2class(angle, num_class=12):
    """Literal scalar port of reference tools/utils.py:53-60."""
    angle = angle % (2 * np.pi)
    angle_per_class = 2 * np.pi / float(num_class)
    shifted_angle = (angle + angle_per_class / 2) % (2 * np.pi)
    class_id = int(shifted_angle / angle_per_class)
    residual_angle = shifted_angle - (
        class_id * angle_per_class + angle_per_class / 2
    )
    return class_id, residual_angle


def ref_class2angle(pred_cls, residual, num_class=12, to_label_format=True):
    angle_per_class = 2 * np.pi / float(num_class)
    angle = pred_cls * angle_per_class + residual
    if to_label_format and angle > np.pi:
        angle = angle - 2 * np.pi
    return angle


MEAN_SIZE_ARR = np.array([[4.8, 1.8, 1.5], [10.0, 2.6, 3.2], [2.0, 1.0, 1.6]])


def ref_size2class(lwh):
    diff = lwh[np.newaxis, ...] - MEAN_SIZE_ARR
    diff = np.linalg.norm(diff, axis=1)
    class_id = int(np.argmin(diff))
    return class_id, lwh - MEAN_SIZE_ARR[class_id]


def greedy_nms_bev(boxes7, scores, thresh):
    """Greedy rotated-BEV NMS oracle. Returns kept original indices in score order."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes7), dtype=bool)
    for i in order:
        if suppressed[i] or not np.isfinite(scores[i]):
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            if iou_bev(boxes7[i], boxes7[j]) > thresh:
                if scores[j] <= scores[i]:
                    suppressed[j] = True
    return keep


def greedy_circle_nms(centers, scores, thresh):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(centers), dtype=bool)
    for _i, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[_i + 1 :]:
            d2 = np.sum((centers[i] - centers[j]) ** 2)
            if d2 <= thresh:
                suppressed[j] = True
    return keep
