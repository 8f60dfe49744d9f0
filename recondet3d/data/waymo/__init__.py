from recondet3d.data.waymo.converter import create_waymo_infos
