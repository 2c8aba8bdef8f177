// Renders {headers, data} from GET /api?query= into a table.
// Independent implementation of the reference's wire contract.
document.getElementById('f').addEventListener('submit', function (ev) {
  ev.preventDefault();
  var q = document.getElementById('q').value;
  fetch('/api?query=' + encodeURIComponent(q))
    .then(function (r) {
      if (!r.ok) { return r.text().then(function (t) { throw new Error(t); }); }
      return r.json();
    })
    .then(function (res) {
      var t = document.createElement('table');
      var hr = document.createElement('tr');
      res.headers.forEach(function (h) {
        var th = document.createElement('th');
        th.textContent = h;
        hr.appendChild(th);
      });
      t.appendChild(hr);
      res.data.forEach(function (row) {
        var tr = document.createElement('tr');
        row.forEach(function (v) {
          var td = document.createElement('td');
          td.textContent = v === null ? '' :
            (typeof v === 'object' ? JSON.stringify(v) : String(v));
          tr.appendChild(td);
        });
        t.appendChild(tr);
      });
      var out = document.getElementById('out');
      out.innerHTML = '';
      out.appendChild(t);
    })
    .catch(function (e) {
      document.getElementById('out').textContent = e.message;
    });
});
