from .lie import exp_so3, make_c2w, se3_inverse, vec2skew
from .motion import (consecutive_relative_poses, full_video_w2c,
                     relative_pose, w2c_from_anchor, w2c_mappings)
from .retriever import (pose_retriever_all, pose_retriever_apply,
                        pose_retriever_init)
from .rotations import (euler_angles_to_matrix, matrix_to_axis_angle,
                        matrix_to_euler_angles, matrix_to_quaternion,
                        quaternion_to_axis_angle)
