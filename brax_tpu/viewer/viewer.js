/* brax_tpu trajectory viewer.
 *
 * Renders a physics scene JSON (see brax_tpu/io/json.py) with three.js and
 * plays back the trajectory.  Role parity with the reference's js/ viewer
 * (system/animator/viewer), written from scratch against our JSON schema.
 *
 * Expects globals: THREE, OrbitControls (from CDN), and `system` (the scene
 * JSON object, injected by io/html.py).
 */

const BODY_COLORS = [
  0x4f77ff, 0xff6f59, 0x41d3a2, 0xffc857, 0xb67ee8, 0x6fd3ff,
  0xff9fb2, 0xa7d129, 0xf2852a, 0x8899aa,
];

function degToRad(v) { return v * Math.PI / 180.0; }

function colliderTransform(col) {
  const group = new THREE.Group();
  const p = col.position || [0, 0, 0];
  const r = col.rotation || [0, 0, 0];
  group.position.set(p[0], p[1], p[2]);
  const e = new THREE.Euler(degToRad(r[0]), degToRad(r[1]), degToRad(r[2]), 'XYZ');
  group.setRotationFromEuler(e);
  return group;
}

function makeColliderMesh(col, material) {
  // brax capsules/boxes are z-up; three geometries are y-up → rotate x by 90°
  let geom = null;
  let mesh = null;
  if (col.capsule) {
    const radius = col.capsule.radius;
    const mid = col.capsule.length - 2 * radius;
    geom = new THREE.CapsuleGeometry(radius, mid, 8, 16);
    mesh = new THREE.Mesh(geom, material);
    mesh.rotation.x = Math.PI / 2;
  } else if (col.sphere) {
    geom = new THREE.SphereGeometry(col.sphere.radius, 16, 16);
    mesh = new THREE.Mesh(geom, material);
  } else if (col.box) {
    const h = col.box.halfsize;
    geom = new THREE.BoxGeometry(2 * h[0], 2 * h[1], 2 * h[2]);
    mesh = new THREE.Mesh(geom, material);
  } else if (col.plane) {
    geom = new THREE.PlaneGeometry(2000, 2000);
    const mat = new THREE.MeshStandardMaterial({color: 0x999999, side: THREE.DoubleSide});
    mesh = new THREE.Mesh(geom, mat);
  } else if (col.clippedPlane) {
    geom = new THREE.PlaneGeometry(2 * col.clippedPlane.halfsizeX || 1,
                                   2 * col.clippedPlane.halfsizeY || 1);
    mesh = new THREE.Mesh(geom, material);
  } else if (col.heightMap) {
    const n = Math.round(Math.sqrt(col.heightMap.data.length));
    geom = new THREE.PlaneGeometry(col.heightMap.size, col.heightMap.size, n - 1, n - 1);
    const pos = geom.attributes.position;
    // heightmap cell (i, j): x right, y down the grid, z = data
    for (let i = 0; i < pos.count; i++) {
      pos.setZ(i, col.heightMap.data[i] || 0);
    }
    geom.computeVertexNormals();
    mesh = new THREE.Mesh(geom, material);
  } else if (col.mesh && system.config.meshGeometries[col.mesh.name]) {
    const mg = system.config.meshGeometries[col.mesh.name];
    geom = new THREE.BufferGeometry();
    const verts = new Float32Array(mg.vertices.flat());
    geom.setAttribute('position', new THREE.BufferAttribute(verts, 3));
    geom.setIndex(mg.faces);
    geom.computeVertexNormals();
    mesh = new THREE.Mesh(geom, material);
    const s = col.mesh.scale || 1.0;
    mesh.scale.set(s, s, s);
  } else {
    return null;
  }
  mesh.castShadow = true;
  mesh.receiveShadow = true;
  return mesh;
}

function buildScene(system) {
  const scene = new THREE.Scene();
  scene.background = new THREE.Color(0x1b1e27);
  scene.up = new THREE.Vector3(0, 0, 1);

  const hemi = new THREE.HemisphereLight(0xffffff, 0x334455, 0.9);
  scene.add(hemi);
  const sun = new THREE.DirectionalLight(0xffffff, 1.4);
  sun.position.set(8, 12, 20);
  sun.castShadow = true;
  sun.shadow.mapSize.set(2048, 2048);
  const cam = sun.shadow.camera;
  cam.left = cam.bottom = -15; cam.right = cam.top = 15;
  scene.add(sun);

  const bodies = [];
  system.config.bodies.forEach((body, i) => {
    const group = new THREE.Group();
    group.name = body.name;
    const color = BODY_COLORS[i % BODY_COLORS.length];
    const material = new THREE.MeshStandardMaterial({color, roughness: 0.55});
    body.colliders.forEach((col) => {
      if (col.hidden) return;
      const mesh = makeColliderMesh(col, material);
      if (!mesh) return;
      const holder = colliderTransform(col);
      holder.add(mesh);
      group.add(holder);
    });
    scene.add(group);
    bodies.push(group);
  });

  // contact debug overlay
  let contacts = null;
  if (system.debug && system.contact_pos && system.contact_pos.length) {
    const n = system.contact_pos[0].length;
    contacts = [];
    const mat = new THREE.MeshBasicMaterial({color: 0xff2222});
    for (let i = 0; i < n; i++) {
      const dot = new THREE.Mesh(new THREE.SphereGeometry(0.04, 8, 8), mat);
      dot.visible = false;
      scene.add(dot);
      contacts.push(dot);
    }
  }
  return {scene, bodies, contacts};
}

function setFrame(system, built, t) {
  const pos = system.pos[t];
  const rot = system.rot[t];
  built.bodies.forEach((group, i) => {
    group.position.set(pos[i][0], pos[i][1], pos[i][2]);
    // brax quaternions are (w, x, y, z)
    group.quaternion.set(rot[i][1], rot[i][2], rot[i][3], rot[i][0]);
  });
  if (built.contacts) {
    const cpos = system.contact_pos[t];
    const cpen = system.contact_penetration[t];
    built.contacts.forEach((dot, i) => {
      const active = i < cpos.length && cpen[i] > 0;
      dot.visible = active;
      if (active) dot.position.set(cpos[i][0], cpos[i][1], cpos[i][2]);
    });
  }
}

function startViewer(system, container) {
  const width = container.clientWidth || window.innerWidth;
  const height = container.clientHeight || Math.round(window.innerHeight * 0.9);

  const renderer = new THREE.WebGLRenderer({antialias: true});
  renderer.setSize(width, height);
  renderer.shadowMap.enabled = true;
  container.appendChild(renderer.domElement);

  const camera = new THREE.PerspectiveCamera(50, width / height, 0.01, 4000);
  camera.up.set(0, 0, 1);

  const built = buildScene(system);
  const nFrames = system.pos.length;
  setFrame(system, built, 0);

  // frame the scene: bounding sphere of the first frame's body positions
  const centers = system.pos[0];
  let cx = 0, cy = 0, cz = 0;
  centers.forEach((p) => { cx += p[0]; cy += p[1]; cz += p[2]; });
  cx /= centers.length; cy /= centers.length; cz /= centers.length;
  let r = 1;
  centers.forEach((p) => {
    r = Math.max(r, Math.hypot(p[0] - cx, p[1] - cy, p[2] - cz));
  });
  camera.position.set(cx + 3 * r, cy + 3 * r, cz + 2 * r);

  const controls = new OrbitControls(camera, renderer.domElement);
  controls.target.set(cx, cy, cz);
  controls.update();

  // playback UI
  const bar = document.createElement('div');
  bar.style.cssText = 'display:flex;gap:8px;align-items:center;padding:6px;' +
      'font-family:monospace;background:#11131a;color:#dde';
  const btn = document.createElement('button');
  btn.textContent = '⏸';
  const slider = document.createElement('input');
  slider.type = 'range'; slider.min = 0; slider.max = nFrames - 1; slider.value = 0;
  slider.style.flex = '1';
  const label = document.createElement('span');
  bar.appendChild(btn); bar.appendChild(slider); bar.appendChild(label);
  container.appendChild(bar);

  let playing = true;
  let frame = 0;
  const dt = Math.max(system.config.dt || 0.033, 1 / 120);
  btn.onclick = () => { playing = !playing; btn.textContent = playing ? '⏸' : '▶'; };
  slider.oninput = () => { frame = Number(slider.value); playing = false; btn.textContent = '▶'; };

  let last = performance.now();
  let acc = 0;
  function animate(now) {
    requestAnimationFrame(animate);
    acc += (now - last) / 1000; last = now;
    if (playing && acc >= dt) {
      frame = (frame + Math.floor(acc / dt)) % nFrames;
      acc = acc % dt;
      slider.value = frame;
    }
    label.textContent = `${frame}/${nFrames - 1}`;
    setFrame(system, built, frame);
    controls.update();
    renderer.render(built.scene, camera);
  }
  requestAnimationFrame(animate);
}

if (typeof window !== 'undefined' && typeof system !== 'undefined') {
  window.addEventListener('DOMContentLoaded', () => {
    startViewer(system, document.getElementById('brax-tpu-viewer'));
  });
}
