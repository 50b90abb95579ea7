#!/bin/bash
# Multipart-MIME wrapper so the startup script re-runs on EVERY boot
# (reference: utils/aws/mime.sh). Paste into instance user data.
cat <<'MIME'
Content-Type: multipart/mixed; boundary="//"
MIME-Version: 1.0

--//
Content-Type: text/cloud-config; charset="us-ascii"

cloud_final_modules:
- [scripts-user, always]

--//
Content-Type: text/x-shellscript; charset="us-ascii"

#!/bin/bash
bash /home/$USER/yolosomi-tpu/deploy/aws/userdata.sh
--//
MIME
